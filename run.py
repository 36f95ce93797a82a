#!/usr/bin/env python
"""Entry point: `python run.py --task <preset> [--set k=v ...]`
(the TPU-native counterpart of the reference's `python run.py with ...`)."""

from fiber_tpu.cli import main

if __name__ == "__main__":
    main()
