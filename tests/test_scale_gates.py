"""Round-3 verdict items 2+3: the TPC-H dimension broadcasts are
size-gated (broadcast within a row budget, bucketed joins past it) and
bounded-output decorations / single-row lookups never read a fact-sized
table to the driver. These tests pin both-paths equality at sf0.001:
forcing the gate to 0 must produce identical results."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas") and not hasattr(res, "count"):
        return res.to_pandas()            # pyarrow.Table
    return res.to_pandas()                # Dataset


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


class TestSizeGatedTpch:
    def test_q5_both_paths_equal(self):
        from tldr_ray.queries import tpch_q5

        a = _norm(_df(tpch_q5(SF)))
        b = _norm(_df(tpch_q5(SF, broadcast_limit_rows=0)))
        assert len(a) > 0
        pd.testing.assert_frame_equal(a, b)

    def test_q7_both_paths_equal(self):
        from tldr_ray.queries import tpch_q7_trade_pairs

        a = _norm(_df(tpch_q7_trade_pairs(SF)))
        b = _norm(_df(tpch_q7_trade_pairs(SF, broadcast_limit_rows=0)))
        assert len(a) > 0
        pd.testing.assert_frame_equal(a, b)


class TestPrunedDriverReads:
    def test_fetch_query_vecs_pushdown(self):
        """_fetch_query_vecs returns exactly the requested rows in id
        order via parquet predicate pushdown."""
        import pyarrow.parquet as pq

        from tldr_ray.queries import _fetch_query_vecs

        got = _fetch_query_vecs(SF, [2, 0])
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = t["vec_id"].to_pylist()
        want2 = np.asarray(t["embedding"][ids.index(2)].as_py(),
                           dtype=np.float32)
        want0 = np.asarray(t["embedding"][ids.index(0)].as_py(),
                           dtype=np.float32)
        assert np.array_equal(got[0], want2)
        assert np.array_equal(got[1], want0)
        with pytest.raises(KeyError):
            _fetch_query_vecs(SF, [10**12])

    def test_q10_decoration_rows(self):
        from tldr_ray.queries import tpch_q10

        out = _df(tpch_q10(SF))
        assert 0 < len(out) <= 20
        assert {"c_custkey", "c_name", "revenue_cents", "acctbal_cents",
                "n_name"} == set(out.columns)
        # every decorated row kept its aggregate key
        assert out["c_custkey"].is_unique

    def test_q18_decoration_rows(self):
        from tldr_ray.queries import tpch_q18

        out = _df(tpch_q18(SF))
        assert 0 < len(out) <= 100
        assert out["o_orderkey"].is_unique
        assert (out["qty_cents"] > 25000).all()


class TestDimDecorate:
    def test_broadcast_and_bucketed_paths_equal(self):
        """_dim_decorate (the reusable size-gated decoration) must
        produce identical rows on both sides of its gate."""
        from tldr_ray.queries import _dim_decorate, _read

        line = _read(SF, "lineitem", ["l_orderkey", "l_suppkey"])
        a = _norm(_dim_decorate(
            line, SF, "supplier", "s_suppkey", "s_nationkey",
            on="l_suppkey", out_col="s_nat").to_pandas())
        b = _norm(_dim_decorate(
            line, SF, "supplier", "s_suppkey", "s_nationkey",
            on="l_suppkey", out_col="s_nat",
            broadcast_limit_rows=0).to_pandas())
        assert len(a) > 0
        pd.testing.assert_frame_equal(
            a, b.astype(a.dtypes.to_dict()))
