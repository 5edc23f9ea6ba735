"""Training sanity: repeated steps on one fixed batch must reduce the loss."""

import numpy as np
import jax

from imvoxelnet_tpu.models.detector import ImVoxelNet
from imvoxelnet_tpu.parallel import train as train_lib

from test_models import _make_batch, _tiny_kitti_cfg, _tiny_indoor_cfg


def _run_steps(cfg, batch, n_steps, lr=3e-3):
    model = ImVoxelNet(cfg)
    tx = train_lib.make_optimizer(lr, 1e-4, 0.1, 35.0, steps_per_epoch=1000)
    state = train_lib.create_train_state(model, tx, jax.random.PRNGKey(0),
                                         batch)
    step = jax.jit(train_lib.make_train_step(model, tx))
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, batch)
        losses.append(float(metrics['loss']))
    return losses


def test_kitti_overfit_loss_decreases():
    losses = _run_steps(_tiny_kitti_cfg(), _make_batch(b=1, g=4), 12)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.8, losses


def test_indoor_overfit_loss_decreases():
    losses = _run_steps(_tiny_indoor_cfg('sunrgbd', 1, False, -1),
                        _make_batch(b=1, g=4), 12)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_total3d_overfit_loss_decreases():
    """Total3D adds the angle/layout losses (weights 100/1) to the indoor
    stack; the joint loss must still learn on a fixed batch."""
    losses = _run_steps(
        _tiny_indoor_cfg('sunrgbd', 1, False, -1, layout=True),
        _make_batch(b=1, g=4, with_layout=True), 12)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_nuscenes_dcn_overfit_loss_decreases():
    """The nuScenes family's train path (NuScenesImVoxelNeck + DCN stages,
    so the deformable-sampling backward is in the graph) must also learn."""
    from test_e2e_nuscenes import _tiny_nuscenes_cfg
    losses = _run_steps(_tiny_nuscenes_cfg(), _make_batch(b=1, v=2, g=4), 12)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.8, losses
