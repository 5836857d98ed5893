"""Stream-style async API parity shim.

The reference exposes Stream (one CUDA stream pinned to a GPU,
cufhe_gpu.cuh:152-189), StreamQuery (non-blocking completion poll,
cufhe_gates_gpu.cu:55-65) and Synchronize (device sweep, cufhe_gpu.cuh:68-74).
JAX dispatch is already asynchronous: every gate call returns immediately
with futures for device buffers, so a Stream here is just an ordered lane of
in-flight results — the object exists so code written against the reference's
completion-polling pattern (test_intensive.cc:21-54) ports directly.
"""
from __future__ import annotations

from typing import List, Optional

import jax


class Stream:
    """An ordered lane of asynchronously dispatched gate results."""

    _count = 0

    def __init__(self, device: Optional[object] = None):
        # round-robin device assignment, mirroring streamCount % _gpuNum
        # (reference cufhe_gpu.cuh:154-158)
        devs = jax.devices()
        self.device = device if device is not None else \
            devs[Stream._count % len(devs)]
        Stream._count += 1
        self._pending: List[object] = []

    def record(self, *cts) -> None:
        """Track ciphertexts produced on this stream (gate outputs)."""
        self._pending.extend(ct.data if hasattr(ct, "data") else ct
                             for ct in cts)

    def query(self) -> bool:
        """StreamQuery analogue: True iff all recorded work has completed
        on device (non-blocking)."""
        for arr in self._pending:
            ready = arr.is_ready() if hasattr(arr, "is_ready") else True
            if not ready:
                return False
        self._pending.clear()
        return True

    def synchronize(self) -> None:
        """Block until everything recorded on this stream is complete.
        Uses device_get rather than block_until_ready: the latter can
        return early through forwarding transports (e.g. the axon tunnel).
        """
        import numpy as np
        for arr in self._pending:
            np.asarray(jax.device_get(arr))
        self._pending.clear()


def stream_query(stream: Stream) -> bool:
    """Free-function form of the reference's StreamQuery."""
    return stream.query()


def synchronize(*streams: Stream) -> None:
    """Synchronize() analogue: with no arguments, drain every pending
    computation on all local devices; with streams, drain those lanes."""
    if streams:
        for st in streams:
            st.synchronize()
        return
    # jax has no global device sync; effectively, blocking on a trivially
    # new computation per device serializes behind all prior work.
    import numpy as np
    import jax.numpy as jnp
    for d in jax.devices():
        np.asarray(jax.device_get(jax.device_put(jnp.zeros((1,)), d)))
