from tldr_ray.pipelines.export import export_training_shards
from tldr_ray.pipelines.pretrain import prepare_pretraining_mix
from tldr_ray.pipelines.summarize import (
    summarize_transcripts,
    summarize_documents,
    assemble_documents,
)

__all__ = [
    "export_training_shards",
    "prepare_pretraining_mix",
    "summarize_transcripts",
    "summarize_documents",
    "assemble_documents",
]
