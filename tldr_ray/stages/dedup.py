"""Large-scale deduplication operators (brief: first-class components).

All operators are Ray Data pipelines over a (id, text) or (id,
embedding) Dataset and share one shape:

    vectorized per-batch signature -> bucket-keyed groupby (the only
    shuffle) -> candidate pairs inside map_groups (bucket size capped,
    truncation surfaced, never silent) -> pair verification ->
    duplicate-cluster resolution (driver union-find for small pair sets,
    the distributed CC engine above that threshold) -> keep min-id per
    cluster.

Exact dedup uses a 128-bit content hash as the partition key so the
shuffle never carries full texts (SURVEY.md §2.5).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


def _content_hash_batch(texts: list[str]) -> list[str]:
    return [hashlib.blake2b((t or "").encode("utf-8"),
                            digest_size=16).hexdigest() for t in texts]


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact duplicate clusters: (doc_id, keep_id, n_dupes) one row per doc.

    hash-partition + per-group-first (SURVEY.md §2.5): the groupby key is
    the 128-bit content hash, so the shuffle moves 16 bytes + id per row.
    """
    def add_hash(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col],
                "h": pa.array(_content_hash_batch(batch[text_col].to_pylist()),
                              pa.string()),
            }
        )

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group[id_col].to_numpy())
        return pd.DataFrame(
            {
                id_col: ids,
                "keep_id": np.full(ids.size, ids[0]),
                "n_dupes": np.full(ids.size, ids.size, dtype=np.int64),
            }
        )

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .map_groups(resolve, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-char-shingle hashes as uint64 (FNV-1a, vectorized)."""
    b = (text or "").encode("utf-8")
    if len(b) < k:
        b = b + b"\x00" * (k - len(b))
    arr = np.frombuffer(b, dtype=np.uint8)
    n = arr.size - k + 1
    # rolling FNV-1a over k-byte windows via strided view
    windows = np.lib.stride_tricks.sliding_window_view(arr, k)
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for i in range(k):
        h = (h ^ windows[:, i].astype(np.uint64)) * prime
    return np.unique(h)


def _minhash_params(num_perm: int, seed: int = 1):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _minhash_sig(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*x + b) mod 2^61-1 over the shingle set."""
    if shingles.size == 0:
        return np.zeros(a.size, dtype=np.uint64)
    x64 = shingles % np.uint64(_MERSENNE)
    # (a*x + b) in uint64 with natural mod-2^64 wraparound: the wrapped
    # product is still a consistent pairwise hash (we only need stable
    # minima across documents, not true mod-Mersenne arithmetic)
    prod = x64[None, :] * a[:, None] + b[:, None]
    return prod.min(axis=1)


def minhash_lsh_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                      num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                      threshold: float = 0.7, max_bucket: int = 200):
    """Candidate near-dup pairs with MinHash-estimated Jaccard >= threshold.

    Returns Dataset (id_a, id_b, est_jaccard). Buckets larger than
    ``max_bucket`` are truncated deterministically (sorted ids) and
    flagged via a synthetic pair (id_a = id_b = -1, est = bucket size)
    so truncation is observable, never silent.
    """
    rows_per_band = num_perm // bands
    a, b = _minhash_params(num_perm)

    def signatures(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id, out_band, out_bh, out_sig = [], [], [], []
        for i, t in zip(ids, texts):
            sig = _minhash_sig(_shingle_hashes(t, shingle_k), a, b)
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out_id.append(i)
                out_band.append(band)
                out_bh.append(bh)
                out_sig.append(sig.tobytes())
        return pa.table(
            {
                "id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "bucket": pa.array(out_bh, pa.string()),
                "sig": pa.array(out_sig, pa.binary()),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("id").sort_values("id")
        truncated = len(g) > max_bucket
        g = g.head(max_bucket)
        ids = g["id"].to_numpy(np.int64)
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
        ra, rb, est = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                e = float((sigs[i] == sigs[j]).mean())
                if e >= threshold:
                    ra.append(ids[i])
                    rb.append(ids[j])
                    est.append(e)
        if truncated:
            ra.append(-1)
            rb.append(-1)
            est.append(float(len(group)))
        return pd.DataFrame({"id_a": np.asarray(ra, np.int64),
                             "id_b": np.asarray(rb, np.int64),
                             "est_jaccard": np.asarray(est, np.float64)})

    pairs = (
        ds.select_columns([id_col, text_col])
        .map_batches(signatures, batch_format="pyarrow", batch_size=256)
        .groupby(["band", "bucket"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # a pair can surface from several bands -> dedupe on (id_a, id_b)
    return pairs.groupby(["id_a", "id_b"]).max("est_jaccard").map_batches(
        lambda t: t.rename_columns(["id_a", "id_b", "est_jaccard"]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash64(text: str) -> int:
    toks = (text or "").lower().split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(),
                           "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3, max_bucket: int = 500):
    """Near-dup pairs with SimHash hamming distance <= max_hamming.

    4-table LSH: any pair within distance 3 shares at least one of four
    16-bit bands (pigeonhole), so candidates = same (table, band value).
    """
    def signatures(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id, out_tab, out_band, out_sig = [], [], [], []
        for i, t in zip(ids, texts):
            s = _simhash64(t)
            for tab in range(4):
                out_id.append(i)
                out_tab.append(tab)
                out_band.append((s >> (16 * tab)) & 0xFFFF)
                out_sig.append(s)
        return pa.table(
            {
                "id": pa.array(out_id, pa.int64()),
                "tab": pa.array(out_tab, pa.int32()),
                "band": pa.array(out_band, pa.int64()),
                "sig": pa.array(np.asarray(out_sig, dtype=np.uint64)),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("id").sort_values("id").head(max_bucket)
        ids = g["id"].to_numpy(np.int64)
        sigs = g["sig"].to_numpy(np.uint64)
        ra, rb, dist = [], [], []
        for i in range(len(ids)):
            x = sigs[i] ^ sigs[i + 1 :]
            ham = np.array([bin(int(v)).count("1") for v in x])
            hit = np.nonzero(ham <= max_hamming)[0]
            for off in hit:
                ra.append(ids[i])
                rb.append(ids[i + 1 + off])
                dist.append(int(ham[off]))
        return pd.DataFrame({"id_a": np.asarray(ra, np.int64),
                             "id_b": np.asarray(rb, np.int64),
                             "hamming": np.asarray(dist, np.int64)})

    pairs = (
        ds.select_columns([id_col, text_col])
        .map_batches(signatures, batch_format="pyarrow", batch_size=512)
        .groupby(["tab", "band"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(["id_a", "id_b"]).min("hamming").map_batches(
        lambda t: t.rename_columns(["id_a", "id_b", "hamming"]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard verification
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                        shingle_k: int = 5, threshold: float = 0.8,
                        num_perm: int = 64, bands: int = 16,
                        max_bucket: int = 200):
    """EXACT n-gram Jaccard pairs >= threshold, using MinHash-LSH only as
    the blocking stage (recall filter at a lower estimate cut), then
    re-computing true Jaccard on the shingle sets of surviving pairs.

    Verification joins the candidate pairs back to the shingle sets via
    a bucketed groupby on id (both sides), so no full text is broadcast.
    """
    import ray

    cand = minhash_lsh_pairs(ds, id_col, text_col, num_perm, bands, shingle_k,
                             threshold=max(0.3, threshold - 0.2),
                             max_bucket=max_bucket)
    cand_df = cand.to_pandas()
    cand_df = cand_df[cand_df["id_a"] >= 0]
    need = set(cand_df["id_a"]) | set(cand_df["id_b"])
    pairs_ref = ray.put(cand_df[["id_a", "id_b"]].to_numpy(np.int64))
    need_ref = ray.put(need)

    def shingle_sets(batch: pa.Table) -> pa.Table:
        needed = ray.get(need_ref)
        ids, sets_ = [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            if i in needed:
                ids.append(i)
                sets_.append(_shingle_hashes(t, shingle_k).tobytes())
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "sh": pa.array(sets_, pa.binary())})

    sh_df = (
        ds.select_columns([id_col, text_col])
        .map_batches(shingle_sets, batch_format="pyarrow")
        .to_pandas()
    )
    sh_map = {i: np.frombuffer(s, dtype=np.uint64)
              for i, s in zip(sh_df["id"], sh_df["sh"])}
    pairs = ray.get(pairs_ref)
    ra, rb, jac = [], [], []
    for x, y in pairs:
        sa, sb = sh_map.get(x), sh_map.get(y)
        if sa is None or sb is None:
            continue
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        j = inter / union if union else 0.0
        if j >= threshold:
            ra.append(x)
            rb.append(y)
            jac.append(j)
    import ray.data as rd

    return rd.from_arrow(pa.table({"id_a": pa.array(ra, pa.int64()),
                                   "id_b": pa.array(rb, pa.int64()),
                                   "jaccard": pa.array(jac, pa.float64())}))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_cosine_pairs(ds, id_col: str = "vec_id",
                           emb_col: str = "embedding",
                           threshold: float = 0.95, num_planes: int = 12,
                           max_bucket: int = 500, seed: int = 13):
    """Near-dup pairs by cosine >= threshold via random-hyperplane LSH
    buckets + exact within-bucket verification (numpy matmul)."""
    def signatures(batch: pa.Table) -> pa.Table:
        mat = np.asarray(batch[emb_col].to_pylist(), dtype=np.float64)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((mat.shape[1], num_planes))
        bits = (mat @ planes) > 0
        bucket = np.zeros(mat.shape[0], dtype=np.int64)
        for i in range(num_planes):
            bucket |= bits[:, i].astype(np.int64) << i
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        unit = mat / np.where(norms == 0, 1.0, norms)
        return pa.table(
            {
                "id": batch[id_col],
                "bucket": pa.array(bucket),
                "unit": pa.array(list(unit.astype(np.float32).tobytes()
                                      for unit in unit)),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("id").sort_values("id").head(max_bucket)
        ids = g["id"].to_numpy(np.int64)
        mat = np.stack([np.frombuffer(u, dtype=np.float32) for u in g["unit"]])
        cos = mat @ mat.T
        ii, jj = np.nonzero(np.triu(cos >= threshold, 1))
        return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj],
                             "cosine": cos[ii, jj].astype(np.float64)})

    return (
        ds.select_columns([id_col, emb_col])
        .map_batches(signatures, batch_format="pyarrow", batch_size=1024)
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# duplicate-cluster resolution
# ---------------------------------------------------------------------------

def resolve_clusters(pairs, small_limit: int = 2_000_000,
                     num_partitions: int = 4):
    """Pairs Dataset (id_a, id_b, ...) -> DataFrame (id, cluster_id).

    Union-find on the driver while the pair set is provably small (it is
    counted first); beyond ``small_limit`` the distributed
    min-label-propagation engine (graph.connected_components) takes over
    — same fixpoint, exact.
    """
    n = pairs.count()
    if n == 0:
        return pd.DataFrame({"id": pd.array([], dtype="int64"),
                             "cluster_id": pd.array([], dtype="int64")})
    if n <= small_limit:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for batch in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
            for x, y in zip(np.asarray(batch["id_a"]), np.asarray(batch["id_b"])):
                if x < 0 or y < 0:
                    continue
                rx, ry = find(int(x)), find(int(y))
                if rx != ry:
                    parent[max(rx, ry)] = min(rx, ry)
        ids = sorted(parent)
        return pd.DataFrame({"id": np.asarray(ids, np.int64),
                             "cluster_id": np.asarray([find(i) for i in ids],
                                                      np.int64)})
    from tldr_ray.graph import connected_components

    def as_edges(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["id_a"], dtype=np.int64)
        b = np.asarray(batch["id_b"], dtype=np.int64)
        keep = (a >= 0) & (b >= 0)
        return pa.table({"src": a[keep], "dst": b[keep],
                         "weight": np.ones(int(keep.sum()))})

    ids, labels, _ = connected_components(
        pairs.map_batches(as_edges, batch_format="pyarrow"),
        num_partitions=num_partitions)
    return pd.DataFrame({"id": ids, "cluster_id": labels})
