"""map_reduce_multi_threaded_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference repo ``ramachav/Map-Reduce-Multi-Threaded`` (a C++11
OpenMP+MPI word-count MapReduce, ~617 lines; see ``SURVEY.md``),
re-expressed Spark-first:

* the reference's single hardwired dataflow (scan → tokenize →
  strip-punct → lowercase → filter → partial hash-aggregate → hash
  shuffle → final merge-aggregate → sorted text sink;
  ``map_reduce.cpp:452-613``) is the flagship pipeline in
  :mod:`.operators.wordcount`;
* every capability it implements implicitly (sources, scalar
  transforms, keyed aggregation, exchange, sinks, metrics) is
  generalized into a proper operator library (:mod:`.operators`,
  :mod:`.sources`, :mod:`.streaming`);
* the LLM-data-pipeline extensions (dedup, similarity search,
  multimodal columns, text analysis) live in :mod:`.operators.dedup`,
  :mod:`.operators.similarity`, :mod:`.operators.multimodal`,
  :mod:`.operators.textstats`.

Everything is DataFrame-API first: declare the logical plan, let
Catalyst/Tungsten/AQE pick the physical strategy. Python UDFs appear
only where built-ins genuinely cannot express the semantics, and then
always as Arrow-batched pandas UDFs / ``mapInPandas``.
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
