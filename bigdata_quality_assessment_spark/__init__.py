"""bigdata_quality_assessment_spark — a PySpark-native data-quality /
dataset-distillation analytics engine.

Re-expresses every operator of the reference active-sampling pipeline
(`amjhd94/BigData-quality-assessment`) as Spark DataFrame / SQL
relational operators, plus the LLM-data-pipeline extensions (dedup,
similarity search, text analysis, profiling) needed at 100 TB scale.

Design stance (SURVEY.md §7.0):
  * one ``points``-style DataFrame in, DataFrames out;
  * explicit ``point_id`` identity everywhere (numpy positional index
    semantics become joins);
  * all scalar math as Catalyst expressions (JVM-side, codegen);
  * Arrow/Pandas UDFs only where a model or a recurrence genuinely
    requires Python (ensemble train/infer, per-trajectory SDE sim);
  * the iterative loop is driver-side control flow with cache /
    localCheckpoint hygiene.
"""

__version__ = "0.1.0"
