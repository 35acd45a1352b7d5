from cvsim_tpu.ops.cmath import c_div, c_int, clampu8, clips16, dbfs
from cvsim_tpu.ops.iir import (
    iir_lowpass,
    iir_lowpass_cascade,
    iir_highpass,
    delay_writeback,
)
from cvsim_tpu.ops.phase import scanline_phase_xi
from cvsim_tpu.ops.noise import random_walk, smoothed_noise_walk

__all__ = [
    "c_div",
    "c_int",
    "clampu8",
    "clips16",
    "dbfs",
    "iir_lowpass",
    "iir_lowpass_cascade",
    "iir_highpass",
    "delay_writeback",
    "scanline_phase_xi",
    "random_walk",
    "smoothed_noise_walk",
]
