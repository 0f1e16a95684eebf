from progressivecodec_tpu.entropy.cdf import pmf_to_quantized_cdf, batched_pmf_to_cdf
from progressivecodec_tpu.entropy.bottleneck import EntropyBottleneck
from progressivecodec_tpu.entropy.gaussian import (
    GaussianConditional,
    build_gaussian_tables,
    gaussian_likelihood,
    build_indexes,
    standardized_cumulative,
)

__all__ = [
    "pmf_to_quantized_cdf",
    "batched_pmf_to_cdf",
    "EntropyBottleneck",
    "GaussianConditional",
    "build_gaussian_tables",
    "gaussian_likelihood",
    "build_indexes",
    "standardized_cumulative",
]
