from vcrnet_tpu.models.embeddings import LPDNet, PointNet, DGCNN, TransformNet
from vcrnet_tpu.models.transformer import TransformerPointer
from vcrnet_tpu.models.heads import (
    vcp_by_dis,
    vcp_top_k_whole,
    vcp_top_k_partial,
    VcpAtt,
)
from vcrnet_tpu.models.vcrnet import VCRNet, vcrnet_iter
from vcrnet_tpu.models.dcp import DCP, MLPHead
from vcrnet_tpu.models.lpd import LPD
from vcrnet_tpu.models.icp import icp_register

__all__ = [
    "LPDNet",
    "PointNet",
    "DGCNN",
    "TransformNet",
    "TransformerPointer",
    "vcp_by_dis",
    "vcp_top_k_whole",
    "vcp_top_k_partial",
    "VcpAtt",
    "VCRNet",
    "vcrnet_iter",
    "DCP",
    "MLPHead",
    "LPD",
    "icp_register",
]
