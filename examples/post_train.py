"""Post-training example (reference docs/post-training.md recipes).

    python examples/post_train.py --experiment error-free_mock_data_smoke

Runs the Trainer over the configured dataset (mock by default); see
docs/post_training.md for LoRA / full fine-tune / distillation recipes.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_predict2_tpu.training.train import main

if __name__ == "__main__":
    main()
