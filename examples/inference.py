"""Basic inference example (reference examples/inference.py used by the docs).

    COSMOS_SMOKE=1 python examples/inference.py --prompt "a robot pouring coffee"

Loads a checkpoint if given (see docs/inference.md for the checkpoint DB),
otherwise runs with random weights under COSMOS_SMOKE for plumbing checks.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_predict2_tpu.inference.cli import main

if __name__ == "__main__":
    main()
