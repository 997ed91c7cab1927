"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference MapReduce search engine
(a-to-the-5/Simple-MapReduce-Search-Engine-Information-Retrieval-),
re-expressed Spark-first (DataFrame / Spark SQL / Catalyst / Structured
Streaming), plus large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Layout:
    session     SparkSession factory tuned for local[32] testing and
                100 TB-cluster-shaped defaults (AQE, shuffle partitions).
    sources/    table loaders (Parquet fixtures, TREC-XML reader).
    functions/  scalar/text functions: tokenizer, stopwords, stemmer,
                text stats, similarity math.
    operators/  reusable dataframe-to-dataframe operators (k-grams,
                dedup, top-k).
    plans/      end-to-end query plans (index build, search, relational
                query pack) — each is a function (spark, sf_dir|DataFrame)
                -> DataFrame so the driver harness and tests share them.
    streaming/  Structured Streaming variants over the events table.
"""

__version__ = "0.1.0"
