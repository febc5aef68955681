"""Background device warmup.

On tunneled TPU backends (axon) the FIRST device->host transfer of a
process pays a large one-off transport-initialization stall (measured
13-58 s on the v5e tunnel, independent of payload size). Firing a tiny
round trip from a daemon thread at startup absorbs that stall WHILE the
host is still reading FASTA/BAM inputs, instead of serializing it into
the first pipeline stage.
"""

from __future__ import annotations

import threading

_started = False


def start_background_warmup() -> None:
    """Idempotently kick a device round trip on a daemon thread."""
    global _started
    if _started:
        return
    _started = True

    def _go():
        try:
            import jax
            import jax.numpy as jnp
            import numpy as np
            np.asarray(jnp.zeros(8) + 1)
        except Exception:
            pass  # no device yet / CPU backend: nothing to warm

    threading.Thread(target=_go, name="device-warmup", daemon=True).start()
