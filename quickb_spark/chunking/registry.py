"""Chunker registry — config-driven stage dispatch (SURVEY.md §2, the
reference's core extension point: src/chunking/registry.py:1-16 maps a
config string to a chunker class; src/main.py:456-521 resolves it per
stage).

Spark re-expression: a registered chunker is a FACTORY
`(ChunkerConfig) -> (documents DataFrame -> chunks DataFrame)`; the config
carries the chunker name, so pipelines select chunkers the same way
reference configs do ("RecursiveTokenChunker", "FixedTokenChunker").
Unknown names fail with the available list, like the reference.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from quickb_spark.config import ChunkerConfig

__all__ = ["ChunkerRegistry", "chunk_documents_with"]


class ChunkerRegistry:
    _chunkers: dict[str, Callable] = {}

    @classmethod
    def register(cls, name: str):
        def deco(factory):
            cls._chunkers[name] = factory
            return factory

        return deco

    @classmethod
    def get(cls, name: str) -> Callable:
        if name not in cls._chunkers:
            raise ValueError(
                f"Unknown chunker: {name}. "
                f"Available chunkers: {sorted(cls._chunkers)}"
            )
        return cls._chunkers[name]


@ChunkerRegistry.register("RecursiveTokenChunker")
def _recursive(cfg: ChunkerConfig):
    from quickb_spark.config import EngineConfig
    from quickb_spark.chunking.udf import chunk_documents

    def run(docs: DataFrame) -> DataFrame:
        return chunk_documents(docs, EngineConfig(chunker=cfg))

    return run


@ChunkerRegistry.register("FixedTokenChunker")
def _fixed_token(cfg: ChunkerConfig):
    from quickb_spark.chunking.fixed_token import fixed_token_chunk_documents

    def run(docs: DataFrame) -> DataFrame:
        return fixed_token_chunk_documents(
            docs, chunk_size=cfg.chunk_size, chunk_overlap=cfg.chunk_overlap
        )

    return run


@ChunkerRegistry.register("ClusterSemanticChunker")
def _cluster_semantic(cfg: ChunkerConfig):
    from quickb_spark.chunking.cluster_semantic import (
        cluster_semantic_chunk_documents,
    )

    def run(docs: DataFrame) -> DataFrame:
        # reference defaults: max_chunk_size=400 (the config chunk_size),
        # min_chunk_size=50 first-stage pieces
        return cluster_semantic_chunk_documents(docs, max_chunk_size=cfg.chunk_size)

    return run


@ChunkerRegistry.register("LLMSemanticChunker")
def _llm_semantic(cfg: ChunkerConfig):
    from quickb_spark.chunking.llm_semantic import llm_semantic_chunk_documents

    def run(docs: DataFrame) -> DataFrame:
        return llm_semantic_chunk_documents(docs)

    return run


@ChunkerRegistry.register("KamradtModifiedChunker")
def _kamradt(cfg: ChunkerConfig):
    from quickb_spark.chunking.kamradt import kamradt_chunk_documents

    def run(docs: DataFrame) -> DataFrame:
        # reference defaults: avg_chunk_size=400 (the config chunk_size),
        # min_chunk_size=50 first-stage pieces
        return kamradt_chunk_documents(docs, avg_chunk_size=cfg.chunk_size)

    return run


def chunk_documents_with(name: str, docs: DataFrame, cfg: ChunkerConfig | None = None) -> DataFrame:
    """Dispatch by config string, reference-style."""
    return ChunkerRegistry.get(name)(cfg or ChunkerConfig())(docs)
