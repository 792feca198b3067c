"""Bench-protocol pins (VERDICT r4 items 2-3): the corpus cache key is
versioned by the synthesis code, and the content digest is stable /
content-sensitive — so cross-round BENCH artifacts state their input
instead of silently comparing different graphs (the r3<->r4 incident).
"""

import hashlib
import sys

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (no ray.init at import)


def test_cache_key_embeds_synthesis_version():
    src = "/root/repo/tldr_ray/sources/transcripts.py"
    with open(src, "rb") as fh:
        want = hashlib.blake2b(fh.read(), digest_size=6).hexdigest()
    assert bench.SYNTH_VERSION == want
    assert bench.CACHE.endswith(f"_v{want}")


def test_stale_unversioned_cache_never_satisfies_new_key():
    old = f"/tmp/tldr_ray/bench_transcripts_n{bench.N_CONVS}_s{bench.SEED}"
    assert bench.CACHE != old           # a pre-versioning /tmp cache
    assert "_v" in bench.CACHE          # is simply a different directory


def test_corpus_digest_tracks_content(tmp_path):
    d = tmp_path / "c"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"one")
    g1 = bench._corpus_digest(str(d))
    (d / "a.parquet").write_bytes(b"two")
    g2 = bench._corpus_digest(str(d))
    assert g1 != g2
    (d / "a.parquet").write_bytes(b"one")
    assert bench._corpus_digest(str(d)) == g1
    (d / "notes.txt").write_bytes(b"ignored")   # non-parquet excluded
    assert bench._corpus_digest(str(d)) == g1
