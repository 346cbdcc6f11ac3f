"""wned_ray — a Ray-Data-native record-linkage engine.

A from-scratch reimplementation of the capabilities of U-Alberta/wned
(WNED, "Robust Named Entity Disambiguation via Random Walks", Guo &
Barbosa) as a blocking + pairwise-scoring + transitive-clustering
pipeline over Parquet transcript tables, built on ``ray.data.Dataset``
streaming execution.

Layout
------
- ``functions/`` : stateless vectorized kernels (string similarity,
  text normalization, MinHash/LSH, sparse-vector similarity, feature
  fusion) — pure numpy / pyarrow, unit-tested against the reference's
  formulas.
- ``state/``     : stateful components held in actor state (CSR entity
  graph + personalized PageRank, checkpoint/lineage manifests).
- ``stages/``    : Ray Data stages (normalize, blocking, candidate-pair
  generation, scoring actor pool, connected components, evaluation,
  per-conversation greedy resolution).
- ``pipelines/`` : end-to-end pipeline builders (linkage, corpus/data
  work: dedup, similarity search, text analysis).
- ``synth``      : deterministic synthetic transcript corpus generator
  (pure function of (seed, size)) used by tests and benchmarks.

No function in this package calls ``ray.init()`` — sessions are owned
by the caller (driver / bench.py / test fixture).
"""

from wned_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
