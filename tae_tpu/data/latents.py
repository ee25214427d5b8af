"""Reader for encoded latent shards (the encode CLI's output).

``tae_tpu.cli.encode`` writes ``{prefix}_latents-NNNNNN.npz`` shards plus a
``{prefix}_index.json``. This reader streams (latents, target) samples back
for training downstream heads directly from pre-encoded dumps — the workflow
the reference's encode.py output implies (reference encode.py:99-100) but
never wires up (its recognition drivers re-encode every batch). Training
from latents skips the frozen-encoder forward entirely.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator

import numpy as np


class LatentDataset:
    def __init__(self, index_path: str | Path):
        index_path = Path(index_path)
        if index_path.is_dir():
            matches = sorted(index_path.glob("*_index.json"))
            if not matches:
                raise FileNotFoundError(f"no *_index.json under {index_path}")
            index_path = matches[0]
        self.dir = index_path.parent
        index = json.loads(index_path.read_text())
        self.shards = index["shards"]
        self.num_samples = index["num_samples"]

    def __len__(self) -> int:
        return self.num_samples

    def iter_samples(self, shard_index: int = 0, shard_count: int = 1,
                     loop: bool = False, seed: int = 0
                     ) -> Iterator[tuple[np.ndarray, np.int64]]:
        """Stream samples from this worker's shard subset; ``loop=True``
        reshuffles shard order each pass (training mode)."""
        rng = np.random.default_rng(seed)
        my_shards = self.shards[shard_index::shard_count] or self.shards
        while True:
            order = rng.permutation(len(my_shards)) if loop else range(len(my_shards))
            for si in order:
                with np.load(self.dir / my_shards[int(si)]["path"]) as data:
                    z = data["latents"]
                    t = data["targets"]
                idx = rng.permutation(len(z)) if loop else range(len(z))
                for i in idx:
                    yield z[int(i)].astype(np.float32), np.int64(t[int(i)])
            if not loop:
                return
