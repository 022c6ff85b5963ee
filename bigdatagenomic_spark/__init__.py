"""bigdatagenomic_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
genome-assembly application (ccya/BigDataGenomic, GraphLab/MPI C++) as an
idiomatic Spark DataFrame/SQL engine, extended with the general relational
operator surface and LLM-training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) documented in
SURVEY.md.

Design principles (see SURVEY.md §4, §7):
  * DataFrame/SQL-first: declare logical plans, let Catalyst + Tungsten
    pick physical strategies (pushdown, pruning, join selection, AQE).
  * No custom Catalyst rules needed — every reference operator maps to
    built-in primitives (SURVEY.md §2.A table).
  * Python UDFs only where built-ins genuinely cannot express the
    semantics, and then always Arrow-batched (pandas_udf / mapInPandas).
"""

__version__ = "0.1.0"
