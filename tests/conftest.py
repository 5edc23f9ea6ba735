"""Test harness: force CPU with 8 virtual devices so mesh / pjit logic is
exercised without TPU hardware (SURVEY.md §4).

The container's ``sitecustomize`` registers the axon TPU PJRT plugin and sets
``JAX_PLATFORMS=axon`` at interpreter start; tests must run on CPU (fast,
deterministic, 8-way mesh), so we override the platform selection before any
backend is initialized.  For the fastest startup, invoke tests as::

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/

but a plain ``python -m pytest tests/`` works too — the config update below
redirects JAX to CPU before first use.
"""

import os

# IMVOXELNET_TPU_TEST_TPU=1 leaves the axon TPU backend active so the
# hardware-gated tests (e.g. the compiled Pallas parity check) can run:
#   IMVOXELNET_TPU_TEST_TPU=1 python -m pytest tests/test_iou_pallas.py -k tpu
if os.environ.get('IMVOXELNET_TPU_TEST_TPU') != '1':
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()

    import jax

    jax.config.update('jax_platforms', 'cpu')
