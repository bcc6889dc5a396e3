from vcrnet_tpu.data.augment import RegistrationPair, make_pair_from_cloud
from vcrnet_tpu.data.synthetic import SyntheticDataset
from vcrnet_tpu.data.modelnet40 import ModelNet40
from vcrnet_tpu.data.kitti import KITTI
from vcrnet_tpu.data.pipeline import Loader, make_loaders

__all__ = [
    "RegistrationPair",
    "make_pair_from_cloud",
    "SyntheticDataset",
    "ModelNet40",
    "KITTI",
    "Loader",
    "make_loaders",
]
