"""Llama-2 7B projection-shape tile sweep (reuses r2_tile_pipeline's
serialized-chain harness).

7B measured 151 tok/s = 70% of its 3.8 GB/token roofline. Policy
suspects:
- w2 (11008, 4096): K = 2^8*43 has no legal tile between 256 and full-K,
  so the policy picks tk=256; K-padding to 11264 enables tk=1024. A/B
  here.
- wqkv (4096, 12288) full width only fits tk=512; is (2048, 4096)
  (bigger tk, narrower stripe) faster?
- w13 (4096, 22016) currently (1024, 4096) via the narrow-stripe
  fallback; probe alternatives.
- wcls (4096, 32000) currently (2048, 4096); probe (4096, 2048).
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from r2_tile_pipeline import sweep, emit


def main():
    # w2: unpadded baseline vs padded
    sweep(11008, 4096, [256], "7b_w2_unpadded", chain=1024)
    sweep(11264, 4096, [1024, 512, (11264, 4096)], "7b_w2_padded",
          chain=1024)
    # wqkv
    sweep(4096, 12288, [(512, 12288), (2048, 4096), (1024, 4096),
                        (4096, 4096)], "7b_wqkv", chain=1024)
    # w13
    sweep(4096, 22016, [(1024, 4096), (2048, 4096), (512, 22016),
                        (2048, 2048)], "7b_w13", chain=1024)
    # wcls
    sweep(4096, 32000, [(2048, 4096), (4096, 2048), (4096, 4096)],
          "7b_wcls", chain=1024)
    emit(stage="DONE")


if __name__ == "__main__":
    main()
