"""colbert_spark — a PySpark-native inverted-index + BM25 retrieval engine.

A from-scratch rebuild of the query/data-processing capabilities of
stanford-futuredata/ColBERT (reference at /root/reference, read-only) as a
classical lexical engine on Spark:

- ``Indexer.index(name, collection)``  — build delta-gap + varint-compressed
  posting lists with per-term block-max metadata (replaces ColBERT's
  IVF/PLAID centroid partitions, colbert/indexing/collection_indexer.py).
- ``Searcher.search / search_all``     — block-max-WAND BM25 top-k over
  co-partitioned posting blocks (replaces colbert/search/index_storage.py).
- ``Ranking``                          — (qid, pid, rank, score) results with
  TSV sink + provenance meta (colbert/data/ranking.py).

Everything is DataFrame-first; Python touches data only through
Arrow-vectorized pandas UDFs (mapInPandas / applyInPandas).
"""

from colbert_spark.plans.config import ColBERTConfig
from colbert_spark.plans.indexer import Indexer
from colbert_spark.plans.searcher import Searcher
from colbert_spark.sources.ranking import Ranking

__version__ = "0.1.0"

__all__ = ["ColBERTConfig", "Indexer", "Searcher", "Ranking", "__version__"]
