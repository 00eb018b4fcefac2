from .acf import acf_fft, acf_fft_from_f32, acf_windowed
from .einstein import (
    einstein_difference_fft,
    einstein_difference_fft_from_f32,
    einstein_difference_windowed,
    msd_fft,
)
from .integrate import (
    trapezoid,
    simpson,
    cumulative_trapezoid,
    polyfit_linear,
)
from .pallas_lag import windowed_lag_pallas
from .pallas_fft import fft_precision

__all__ = [
    "fft_precision",
    "acf_fft",
    "acf_fft_from_f32",
    "acf_windowed",
    "einstein_difference_fft",
    "einstein_difference_fft_from_f32",
    "einstein_difference_windowed",
    "msd_fft",
    "trapezoid",
    "simpson",
    "cumulative_trapezoid",
    "polyfit_linear",
    "windowed_lag_pallas",
]
