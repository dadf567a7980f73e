#!/usr/bin/env python
"""Drop-in path shim for the reference script `r_separate sampler`: a user of the
reference can run this file from the repo root with the same flag
surface and get the TPU-native implementation (gea.cli.sample_r_separate)."""

import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

from gea.cli.sample_r_separate import main

if __name__ == "__main__":
    main()
