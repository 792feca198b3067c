"""End-to-end curation pipeline test."""

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_curate_documents(tmp_path):
    import ray.data as rd

    from tldr_ray.pipelines.curation import curate_documents

    good = ("the quick brown fox jumps over the lazy dog while the band "
            "plays a quiet waltz near the old harbor in heavy autumn rain")
    near = good.replace("quiet waltz", "quiet polka")
    junk = "!!! ??? 000 111 222 333 444 555 !!! ???"
    texts = [good, near, good, junk,
             "copper pipes and nickel fittings fill the quiet alpine "
             "workshop where the old turbine engine rests on a ledger of "
             "oak beams near the river"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))

    out_dir = str(tmp_path / "curated")
    curated, report = curate_documents(
        docs, min_quality=0.5, near_dup_threshold=0.5, out_dir=out_dir)
    ids = sorted(curated.to_pandas()["doc_id"])

    assert report["input_rows"] == 5
    assert report["after_quality"] == 4           # junk gated out
    assert report["after_exact_dedup"] == 3       # doc 2 == doc 0 exactly
    assert report["near_dup_dropped"] == 1        # doc 1 near-dups doc 0
    assert ids == [0, 4]
    assert report["output_rows"] == 2
    import os

    assert any(f.endswith(".parquet") for f in os.listdir(out_dir))
