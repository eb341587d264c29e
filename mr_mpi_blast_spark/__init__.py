"""mr_mpi_blast_spark — a PySpark-native distributed similarity-search engine.

A from-scratch re-expression of the capabilities of andreyto/mr-mpi-blast
(a matrix-split parallel BLAST engine built on MapReduce-MPI) as an
idiomatic Spark DataFrame pipeline:

    FASTA ingestion -> query blocks x DB partitions (cross join)
    -> alignment kernel (Arrow-batched pandas UDF)
    -> hit projections -> e-value filter -> skew-safe per-query top-k
    -> columnar / tabular sinks

Everything around the kernel is declarative DataFrame/SQL so Catalyst +
Tungsten own scheduling, shuffle, spill, and codegen (the reference hand
rolls all four — see SURVEY.md §4).

Beyond the reference surface, the package adds the operators a large-scale
training-data pipeline needs: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding-cosine), similarity search (brute-force and
LSH-bucketed ANN), text analysis (language id, quality scoring, token
counting, fingerprinting), multimodal column plumbing, and Structured
Streaming over event tables.
"""

__version__ = "0.1.0"

from mr_mpi_blast_spark.session import get_spark  # noqa: F401
