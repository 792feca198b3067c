from tldr_ray.pipelines.summarize import (
    summarize_transcripts,
    summarize_documents,
    assemble_documents,
)

__all__ = [
    "summarize_transcripts",
    "summarize_documents",
    "assemble_documents",
]
