"""Mid-scale distributed-vs-oracle parity: a 200k-edge random graph
through the full shard pipeline must match the NumPy transliteration to
1e-6 per vertex (the north-rule acceptance bar at a size where real
multi-partition exchange happens every iteration)."""

import numpy as np
import pytest

from tldr_ray.kernel import pagerank_ref


@pytest.mark.usefixtures("ray_session")
def test_pagerank_parity_200k_edges():
    import pyarrow as pa
    import ray.data as rd

    from tldr_ray.graph import pagerank

    rng = np.random.default_rng(123)
    n, m = 20_000, 200_000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m) + 0.01
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst, "weight": w}))

    ids, scores, info = pagerank(ds, num_partitions=6)
    assert info["converged"]
    o_ids, o_scores = pagerank_ref(src, dst, w)
    assert np.array_equal(ids, o_ids)
    np.testing.assert_allclose(scores, o_scores, atol=1e-6)
    # mass conservation at scale
    assert np.isclose(scores.sum(), 1.0, atol=1e-6)
