"""Transfer stall watchdog (parallel/mesh.py::_timed_get).

A relayed TPU transport can drop mid-transfer, leaving device_get blocked
forever; the watchdog turns that into TransferStalled so launchers (e.g.
launchers/train_tpu_e2e.sh's retry loop) can restart and resume from the
latest checkpoint.  No reference analogue (torch.distributed raises its own
NCCL timeouts; this is the TPU-relay equivalent).
"""

import numpy as np
import pytest

from reflecting_reality_tpu.parallel import mesh


class TestTimedGet:
    def test_passes_through_results(self):
        out = mesh._timed_get([np.arange(4), np.ones((2, 2))], "t")
        assert np.array_equal(out[0], np.arange(4))

    def test_timeout_raises_transfer_stalled(self, monkeypatch):
        monkeypatch.setenv("RR_TRANSFER_TIMEOUT_S", "0.2")

        def hang(_):
            import time

            time.sleep(10)

        monkeypatch.setattr(mesh.jax, "device_get", hang)
        with pytest.raises(mesh.TransferStalled, match="presumed wedged"):
            mesh._timed_get([np.zeros(1)], "probe")

    def test_errors_propagate(self, monkeypatch):
        def boom(_):
            raise ValueError("backend exploded")

        monkeypatch.setattr(mesh.jax, "device_get", boom)
        with pytest.raises(ValueError, match="backend exploded"):
            mesh._timed_get([np.zeros(1)], "probe")

    def test_zero_timeout_disables_watchdog(self, monkeypatch):
        monkeypatch.setenv("RR_TRANSFER_TIMEOUT_S", "0")
        out = mesh._timed_get(np.arange(3), "t")
        assert np.array_equal(out, np.arange(3))

    def test_fetch_tree_uses_watchdog(self, monkeypatch):
        monkeypatch.setenv("RR_TRANSFER_TIMEOUT_S", "0.2")

        def hang(_):
            import time

            time.sleep(10)

        monkeypatch.setattr(mesh.jax, "device_get", hang)
        with pytest.raises(mesh.TransferStalled):
            mesh.fetch_tree({"a": np.zeros((8,), np.float32)})
