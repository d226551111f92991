import os

# Tests run on a virtual 8-device CPU mesh: multi-chip sharding logic is
# validated without TPU hardware; bench.py targets the real chip instead.
#
# The environment's sitecustomize force-registers a remote "axon" TPU backend
# and sets jax_platforms="axon,cpu" before pytest starts, so plain env vars
# are not enough — override the config directly before any backend is
# initialized.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running e2e test (not deselected by default)"
    )
