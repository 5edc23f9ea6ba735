import numpy as np

from imvoxelnet_tpu.data.loader import DataLoader


class _FakeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def get_sample(self, index, train, rng):
        return dict(x=np.full((2,), index, np.float32),
                    r=np.float32(rng.rand()))

    def collate(self, samples):
        return dict(x=np.stack([s['x'] for s in samples]),
                    r=np.stack([s['r'] for s in samples]))


def test_loader_epoch_shapes_and_shuffle():
    ds = _FakeDataset(10)
    loader = DataLoader(ds, batch_size=4, train=True, seed=0, num_workers=2)
    assert len(loader) == 2
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    assert batches[0]['x'].shape == (4, 2)
    seen = set(np.concatenate([b['x'][:, 0] for b in batches]).tolist())
    assert len(seen) == 8  # distinct shuffled indices, last partial dropped
    # different epoch -> different order
    batches1 = list(loader.epoch(1))
    assert not np.array_equal(batches[0]['x'], batches1[0]['x'])


def test_loader_determinism():
    ds = _FakeDataset(8)
    loader = DataLoader(ds, batch_size=4, train=True, seed=7, num_workers=3)
    a = list(loader.epoch(0))
    b = list(loader.epoch(0))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x['x'], y['x'])
        np.testing.assert_array_equal(x['r'], y['r'])


def test_loader_test_mode_keeps_order():
    ds = _FakeDataset(6)
    loader = DataLoader(ds, batch_size=4, train=False, drop_last=False)
    batches = list(loader.epoch(0))
    order = np.concatenate([b['x'][:, 0] for b in batches])
    np.testing.assert_array_equal(order, np.arange(6))
