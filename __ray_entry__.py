"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in tldr_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001.

    Per-document LexRank summarization (k=3) over the ``documents``
    table via the pre-split entry point (the synthetic corpus carries no
    sentence punctuation, so 12-word pseudo-sentences feed the
    reference's O28 path).
    """
    from tldr_ray.pipelines import summarize_documents
    from tldr_ray.sources import read_table

    docs = read_table(f"{SF0001}/documents.parquet",
                      columns=["doc_id", "text"])
    return summarize_documents(docs, num=3, presplit_words=12)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from tldr_ray import queries as q

    return q.QUERIES


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    from tldr_ray import queries as q

    return q.ORACLE_SQL
