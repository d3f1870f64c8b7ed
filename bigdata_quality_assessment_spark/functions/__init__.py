"""Pure Catalyst column expressions — the engine's scalar-function layer.

Everything here returns a ``pyspark.sql.Column`` (no actions, no UDFs),
so all of it stays inside whole-stage codegen.
"""

from bigdata_quality_assessment_spark.functions.arrays import (
    cosine_similarity,
    dot_product,
    l1_distance,
    l2_norm,
)
from bigdata_quality_assessment_spark.functions.counter_rng import (
    counter_gaussian,
    counter_hash,
    counter_uniform,
)
from bigdata_quality_assessment_spark.functions.pdfs import (
    gaussian_pdf,
    gaussian_pdf_grad,
    lognormal_pdf,
    uniform_pdf,
)
from bigdata_quality_assessment_spark.functions.scalar import (
    abs_error,
    affine_rescale,
    clamp_nonneg,
    finite,
    log_clip,
    squared_error,
)

__all__ = [
    "counter_hash",
    "counter_uniform",
    "counter_gaussian",
    "affine_rescale",
    "squared_error",
    "abs_error",
    "log_clip",
    "finite",
    "clamp_nonneg",
    "uniform_pdf",
    "gaussian_pdf",
    "gaussian_pdf_grad",
    "lognormal_pdf",
    "dot_product",
    "l2_norm",
    "l1_distance",
    "cosine_similarity",
]
