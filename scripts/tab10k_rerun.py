"""Re-run the bench.py 10k tabulated leg with overflow headroom.

The recorded bench (TPU_NUMBERS_r05.md) latched the neighbor-overflow
flag late in the 10k tabulated timed run: the tabulated melt's deeper
well densifies the fluid past the post-equilibration cap retune margin.
This rerun skips the retune (build-time caps, sized for the packed
start, hold) to get an overflow-clean rate for the record.

    python scripts/tab10k_rerun.py [n_mols]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["BENCH_NO_RETUNE"] = "1"

import bench  # noqa: E402


def main():
    n_mols = int(sys.argv[1]) if len(sys.argv) > 1 else 3334
    import jax

    want_pallas = jax.default_backend() == "tpu"
    r = bench._bench_melt(n_mols, want_pallas, n_blocks=5, block_steps=200,
                          tabulated=True)
    print(json.dumps({"tabulated_no_retune": r}), flush=True)


if __name__ == "__main__":
    main()
