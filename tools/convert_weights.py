"""CLI: convert a reference torch .pth checkpoint to a framework checkpoint.

    python tools/convert_weights.py weights/ref/new_epoch_model.pth out.pth

The experiment runner and test_experiment.py can also load torch .pth files
directly (sisr_tpu.train.checkpoint.load_any); this tool pre-converts them so
serving hosts don't need torch installed.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("torch_pth")
    p.add_argument("out_path")
    args = p.parse_args()

    from sisr_tpu.models.torch_port import load_torch_checkpoint
    from sisr_tpu.train.checkpoint import save_checkpoint

    loaded = load_torch_checkpoint(args.torch_pth)
    save_checkpoint(args.out_path, loaded["start_epoch"],
                    loaded["variables"]["params"])
    print(f"wrote {args.out_path} (epoch {loaded['start_epoch']})")


if __name__ == "__main__":
    main()
