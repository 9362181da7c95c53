"""lazyosm_spark — a PySpark-native spatial-join + tiling analytics engine.

A from-scratch rebuild (NOT a port) of the query/data-processing
capabilities of the reference `harrowing-coder/lazyosm` Go library
(see SURVEY.md), re-expressed as idiomatic Spark DataFrame operators:

- entity decode (delta / zigzag / dictionary)  -> lazyosm_spark.functions.decode
- hierarchical cell index (quadkey grid)       -> lazyosm_spark.functions.cells
- spatial join (cell prefilter + PIP refine)   -> lazyosm_spark.operators.spatial_join
- geometry assembly (ring connect / nesting)   -> lazyosm_spark.operators.assemble
- grid kNN / phash Hamming kNN                 -> lazyosm_spark.operators.knn
- dedup suite (exact / minhash / simhash)      -> lazyosm_spark.operators.dedup
- text analysis (langid / quality / tokens)    -> lazyosm_spark.operators.text
- image codec + multimodal plumbing            -> lazyosm_spark.sources.images
- lineage / checkpoint metadata tables         -> lazyosm_spark.plans.lineage
"""

__version__ = "0.1.0"

from lazyosm_spark.session import get_spark  # noqa: F401
