"""PrefetchLoader: parallel batch build with deterministic ordering."""

import time

import numpy as np
import pytest

from diffcodec_tpu.train.prefetch import PrefetchLoader


class FakeDataset:
    """Items carry their index; odd items sleep to scramble worker timing."""

    def __init__(self, n=32):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i % 3 == 1:
            time.sleep(0.01)
        return {"image": np.full((2, 2), i, np.float32), "text": f"t{i}"}


def _sequential_batches(ds, batch_size, seed):
    rng = np.random.default_rng(seed)
    order = np.arange(len(ds))
    rng.shuffle(order)
    out = []
    for s in range(0, len(order) - batch_size + 1, batch_size):
        idx = order[s:s + batch_size]
        samples = [ds[int(i)] for i in idx]
        out.append({"image": np.stack([x["image"] for x in samples]),
                    "text": [x["text"] for x in samples]})
    return out


def test_prefetch_matches_sequential_order():
    ds = FakeDataset(32)
    loader = PrefetchLoader(ds, batch_size=4, num_workers=3, prefetch=2,
                            shuffle=True, seed=7)
    got = list(loader.epoch())
    want = _sequential_batches(ds, 4, 7)
    assert len(got) == len(want) == 8
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["image"], w["image"])
        assert g["text"] == w["text"]


def test_prefetch_text_encoder_and_len():
    ds = FakeDataset(12)
    calls = []

    def enc(texts):
        calls.append(list(texts))
        return np.zeros((len(texts), 3))

    loader = PrefetchLoader(ds, batch_size=3, num_workers=2,
                            shuffle=False, text_encoder=enc)
    assert len(loader) == 4
    batches = list(loader.epoch())
    assert all(b["text_embeds"].shape == (3, 3) for b in batches)
    # encoder ran on the consumer thread, in order
    assert calls == [b["text"] for b in batches]


def test_prefetch_propagates_worker_errors():
    class Exploding(FakeDataset):
        def __getitem__(self, i):
            if i == 5:
                raise ValueError("boom")
            return super().__getitem__(i)

    loader = PrefetchLoader(Exploding(12), batch_size=3, num_workers=2,
                            shuffle=False)
    with pytest.raises(ValueError, match="boom"):
        list(loader.epoch())


def test_prefetch_second_epoch_reshuffles():
    ds = FakeDataset(16)
    loader = PrefetchLoader(ds, batch_size=4, num_workers=2, shuffle=True,
                            seed=0)
    e1 = [b["image"][:, 0, 0].tolist() for b in loader.epoch()]
    e2 = [b["image"][:, 0, 0].tolist() for b in loader.epoch()]
    assert sorted(sum(e1, [])) == sorted(sum(e2, []))
    assert e1 != e2  # a fresh permutation each epoch
