#!/usr/bin/env python
"""CLI entry point — same public surface as the reference main.py:

    python main.py --model vcrnet --eval --dataset modelnet40
    python main.py --model lpd --batch_size 16
    python main.py --model vcrnet --partial --overlap 0.575 --iter 3 --eval
"""

from vcrnet_tpu.cli import main

if __name__ == "__main__":
    main()
