"""Transcript table sources.

The primary input per ``BASELINE.json input_hint``: a Parquet table of
multi-turn conversation / agent transcripts with columns
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])``.

Two sources:

- ``synth_*``: the deterministic generator of FIXTURES.md §F1 — per-turn
  text reproducible from ``(seed, conv_id)`` alone (near-duplicate turns
  reference earlier turns of the same conversation, so determinism is
  per-conversation). Exercises quirk Q1 (turns without terminal
  punctuation), near-dedup (O6), quirk Q5 (``'``/``-``/``_`` words) and
  hub skew (Zipf-hot tool names).
- ``documents_as_transcripts``: derives a transcript table from the
  driver-provided ``documents`` Parquet (TESTDATA.md) by splitting each
  document's text into turns — used so driver-side correctness queries
  can run on the shared tables.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_ROLES = ["user", "assistant", "tool"]

# ~20 tool names with a Zipf-like hot head: the first is a deliberate hub
# (FIXTURES.md F1 "exercises skew salting").
_TOOLS = [
    "search", "browser", "python", "calculator", "filesystem", "editor",
    "shell", "sql", "http", "translate", "summarize", "vision", "audio",
    "planner", "memory", "mail", "calendar", "weather", "maps", "news",
]
_TOOL_WEIGHTS = np.array([0.40, 0.15, 0.10, 0.07, 0.05, 0.04, 0.03, 0.025,
                          0.02, 0.02, 0.015, 0.015, 0.01, 0.01, 0.01, 0.01,
                          0.005, 0.005, 0.0025, 0.0025])
_TOOL_WEIGHTS = _TOOL_WEIGHTS / _TOOL_WEIGHTS.sum()

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu "
    "xi omicron pi rho sigma tau upsilon phi chi psi omega orbit comet nebula "
    "quasar photon gluon meson lepton hadron proton neutron electron quark "
    "forest river canyon glacier meadow prairie tundra summit valley delta "
    "harbor island lagoon reef atoll dune mesa butte plateau basin "
    "engine piston turbine rotor stator flywheel gasket manifold camshaft "
    "ledger invoice audit budget revenue margin equity asset liability bond "
    "sonnet stanza meter rhyme verse prose fable parable epic saga myth "
    "copper zinc nickel cobalt silver tungsten titanium lithium sodium neon"
).split()

# quirk-Q5 bait: words with apostrophes / dashes / underscores survive the
# tokenizer but are mangled by the dictionary cleaner
_QUIRK_WORDS = ["here's", "don't", "well-known", "state-of-the-art",
                "snake_case", "it's", "o'clock", "re-entry"]

# ~12 entity names with a Zipf-hot head: "Atlas" is the deliberate hub
# (mirrors the tool hub; exercises the entity-edge star clamp). Mentions
# are capitalized mid-sentence words — exactly what the extraction
# heuristic in stages.edges.entity_mentions looks for.
_ENTITIES = ["Atlas", "Borealis", "Cascade", "Dynamo", "Equinox", "Fjord",
             "Granite", "Horizon", "Isthmus", "Juniper", "Krypton", "Lumen"]
_ENTITY_WEIGHTS = np.array([0.42, 0.16, 0.10, 0.08, 0.06, 0.05, 0.04, 0.03,
                            0.02, 0.02, 0.01, 0.01])
_ENTITY_WEIGHTS = _ENTITY_WEIGHTS / _ENTITY_WEIGHTS.sum()


def _inject_entities(seed: int, conv_id: str, texts: list[str]) -> list[str]:
    """Deterministically insert entity mentions mid-sentence (position
    >= 1, so the mention is never sentence-initial). A SEPARATE rng
    stream keeps the original per-conversation draw sequence intact."""
    rng = _conv_rng(seed, conv_id + "#entities")
    out = []
    for text in texts:
        if rng.random() < 0.35:
            words = text.split()
            if len(words) >= 2:
                ent = _ENTITIES[int(rng.choice(len(_ENTITIES),
                                               p=_ENTITY_WEIGHTS))]
                pos = int(rng.integers(1, len(words)))
                words.insert(pos, ent)
                text = " ".join(words)
        out.append(text)
    return out

_BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds


def _conv_rng(seed: int, conv_id: str) -> np.random.Generator:
    h = hashlib.blake2b(f"{seed}:{conv_id}".encode(), digest_size=8).digest()
    return np.random.default_rng(int.from_bytes(h, "little"))


def _make_sentence(rng: np.random.Generator, allow_quirk: bool) -> str:
    n_words = int(rng.integers(3, 12))
    words = [_WORDS[int(i)] for i in rng.integers(0, len(_WORDS), n_words)]
    if allow_quirk and rng.random() < 0.25:
        words[int(rng.integers(0, len(words)))] = _QUIRK_WORDS[
            int(rng.integers(0, len(_QUIRK_WORDS)))
        ]
    words[0] = words[0].capitalize()
    term = ".?!"[int(rng.integers(0, 3))]
    return " ".join(words) + term


def synth_conversation(seed: int, conv_id: str, conv_index: int):
    """Deterministic turns of one conversation: list of row dicts."""
    rng = _conv_rng(seed, conv_id)
    n_turns = int(rng.integers(3, 21))
    rows = []
    texts: list[str] = []
    for turn_idx in range(n_turns):
        role = _ROLES[turn_idx % 3]
        if turn_idx > 0 and rng.random() < 0.08:
            # near-duplicate of an earlier turn: copy + tweak one word
            src = texts[int(rng.integers(0, len(texts)))]
            words = src.split()
            if len(words) > 2:
                words[int(rng.integers(0, len(words)))] = _WORDS[
                    int(rng.integers(0, len(_WORDS)))
                ]
            text = " ".join(words)
        else:
            n_sent = int(rng.integers(1, 5))
            sents = [_make_sentence(rng, allow_quirk=True) for _ in range(n_sent)]
            if rng.random() < 0.10:
                # quirk Q1 bait: final sentence loses its terminator
                sents[-1] = sents[-1][:-1]
            text = " ".join(sents)
        texts.append(text)
        tool = None
        if role == "tool":
            tool = _TOOLS[int(rng.choice(len(_TOOLS), p=_TOOL_WEIGHTS))]
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": turn_idx,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": _BASE_TS_US + conv_index * 3_600_000_000 + turn_idx * 30_000_000,
            }
        )
    final = _inject_entities(seed, conv_id, [r["text"] for r in rows])
    for r, t in zip(rows, final):
        r["text"] = t
    return rows


def _rows_to_table(rows: list[dict]) -> pa.Table:
    cols = {name: [r[name] for r in rows] for name in
            ("conv_id", "turn_idx", "role", "text", "tool")}
    ts = pa.array([r["ts"] for r in rows], pa.timestamp("us"))
    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": ts,
        }
    )


def synth_transcripts_table(n_conversations: int, seed: int = 42) -> pa.Table:
    """Small-scale driver-side synthesis (tests / fixtures)."""
    rows: list[dict] = []
    for i in range(n_conversations):
        rows.extend(synth_conversation(seed, f"conv-{i:06d}", i))
    return _rows_to_table(rows)


def transcripts_dataset(n_conversations: int, seed: int = 42,
                        parallelism: int = 32):
    """Distributed synthesis as a Ray Dataset (bench-scale generation).

    ``ray.data.range`` over conversation indexes fanned out with
    ``map_batches`` — each batch generates whole conversations, so the
    per-conversation determinism invariant holds regardless of block
    boundaries.
    """
    import ray.data as rd

    def gen(batch):
        rows: list[dict] = []
        for i in batch["id"].tolist():
            rows.extend(synth_conversation(seed, f"conv-{i:06d}", i))
        return _rows_to_table(rows)

    return (
        rd.range(n_conversations, override_num_blocks=parallelism)
        .map_batches(gen, batch_format="numpy", batch_size=256)
    )


def write_transcripts(path: str, n_conversations: int, seed: int = 42,
                      parallelism: int = 32) -> str:
    transcripts_dataset(n_conversations, seed, parallelism).write_parquet(path)
    return path


def documents_as_transcripts(sf_dir: str):
    """Derive a transcript Dataset from the shared ``documents`` table.

    Each document becomes one conversation (``conv_id = doc-<doc_id>``);
    its text is split into turns of up to 2 sentences using the
    reference sentence splitter, so rejoining turns with a single space
    reproduces the sentence stream (per-turn text equality under stable
    turn ordering). Documents whose text has no sentence terminator
    become a single turn holding the raw text. The document's ``source``
    rides in the ``tool`` column, giving the co-reference edge builder a
    real cross-conversation key on the shared tables.
    """
    import ray.data as rd

    from tldr_ray.kernel import tokenize_sentences

    def explode(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for doc_id, text, source in zip(batch["doc_id"].to_pylist(),
                                        batch["text"].to_pylist(),
                                        batch["source"].to_pylist()):
            sents = tokenize_sentences(text or "")
            if not sents:
                turns = [text or ""]
            else:
                turns = [" ".join(sents[i : i + 2]) for i in range(0, len(sents), 2)]
            for t_idx, t_text in enumerate(turns):
                rows.append(
                    {
                        "conv_id": f"doc-{doc_id}",
                        "turn_idx": t_idx,
                        "role": _ROLES[t_idx % 3],
                        "text": t_text,
                        "tool": source,
                        "ts": _BASE_TS_US + int(doc_id) * 3_600_000_000
                        + t_idx * 30_000_000,
                    }
                )
        return _rows_to_table(rows)

    from tldr_ray.sources.tabular import hashable_parquet_schema

    path = f"{sf_dir}/documents.parquet"
    cols = ["doc_id", "text", "source"]
    ds = rd.read_parquet(path, columns=cols,
                         schema=hashable_parquet_schema(path, cols))
    return ds.map_batches(explode, batch_format="pyarrow", batch_size=512)
