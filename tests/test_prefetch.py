"""Input-pipeline prefetcher: ordering, placement, error propagation."""
import numpy as np
import pytest


def test_prefetch_preserves_order_and_places():
    import jax
    from fscl_tpu.train.trainer import prefetch_batches

    batches = [np.full((2, 2), i, np.float32) for i in range(7)]
    out = list(prefetch_batches(iter(batches), size=3, place=jax.device_put))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert isinstance(b, jax.Array)
        assert float(b[0, 0]) == i


def test_prefetch_propagates_producer_errors():
    from fscl_tpu.train.trainer import prefetch_batches

    def gen():
        yield np.zeros(1)
        raise RuntimeError("boom in collate")

    it = prefetch_batches(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom in collate"):
        next(it)
