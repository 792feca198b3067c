"""Golden-file parity with the reference conformance corpus.

Mirrors /root/reference/tldr_test.go:48-164: sample.txt summarized with
{hamming, jaccard, invalid} x pagerank (k=3 and the invalid-num clamp
path) and hamming x centrality, joined with "\n\n" and compared to the
golden files byte-for-byte after strip().
"""

from pathlib import Path

import pytest

from tldr_ray.config import SummarizeConfig
from tldr_ray.kernel import summarize, tokenize_sentences, build_dictionary

REF = Path("/root/reference")
TEXT = (REF / "sample.txt").read_text()
RESULT = (REF / "result.txt").read_text().strip()
SHORT_RESULT = (REF / "short.result.txt").read_text().strip()
RESULT_CENTRALITY = (REF / "result_centrality.txt").read_text().strip()
SHORT_RESULT_CENTRALITY = (REF / "short.result_centrality.txt").read_text().strip()


def join(sentences):
    return "\n\n".join(sentences)


def test_sample_structure():
    # tldr_test sample is 17 sentences under the reference splitter with a
    # 233-word dictionary (SURVEY.md §5)
    sentences = tokenize_sentences(TEXT)
    assert len(sentences) == 17
    assert len(build_dictionary(TEXT.strip())) == 233


@pytest.mark.parametrize("weighing", ["hamming", "jaccard", "invalid"])
def test_pagerank_golden_k3(weighing):
    cfg = SummarizeConfig(weighing=weighing, algorithm="")
    assert join(summarize(TEXT, 3, cfg)) == RESULT


@pytest.mark.parametrize("weighing", ["hamming", "jaccard", "invalid"])
def test_pagerank_golden_clamp(weighing):
    cfg = SummarizeConfig(weighing=weighing, algorithm="invalid")
    assert join(summarize(TEXT, 10000, cfg)) == SHORT_RESULT


def test_centrality_golden_k3():
    cfg = SummarizeConfig(weighing="hamming", algorithm="centrality")
    assert join(summarize(TEXT, 3, cfg)) == RESULT_CENTRALITY


def test_centrality_golden_clamp():
    cfg = SummarizeConfig(weighing="hamming", algorithm="centrality")
    assert join(summarize(TEXT, 10000, cfg)) == SHORT_RESULT_CENTRALITY


def test_presplit_sentences():
    # /root/reference/sentences_test.go:9-25 (entry point 2, O28)
    presplit = [
        "Mary had a little lamb,",
        "it's fleece was white as snow,",
        "and everywhere that Mary went,",
        "that lamb was sure to go.",
    ]
    out = summarize("", 1, SummarizeConfig(), presplit=presplit)
    assert out == ["it's fleece was white as snow,"]
