"""Scalar/column function library (SURVEY.md §2.9 + training-data text ops).

Everything here is built from `pyspark.sql.functions` (JVM-side, codegen'd)
— no Python UDFs in the hot path.  The UDF surface of the engine is confined
to classifier/ (grouped pandas UDF) and multimodal/ (Arrow mapInPandas).
"""
