"""Batched DSP ops (JAX/XLA/Pallas) + numpy golden reference.

Submodules:

- ``reference``   numpy golden implementations of the librosa algorithms
                  the reference repo calls (the parity oracle for tests).
- ``stft``        batched STFT / iSTFT / RMS framing (XLA rFFT).
- ``mel``         mel filterbank matmul + power_to_db.
- ``hpss``        jnp HPSS (sliding medians + Wiener soft masks).
- ``hpss_pallas`` fused single-pass Pallas TPU kernel for spectral HPSS.
- ``frontend_pallas`` fully fused audio->feature Pallas kernel (windowed
                  DFT + HPSS medians + masks + mel in one VMEM pass).
- ``featuregram`` end-to-end featName dispatch (audio -> feature matrix).
- ``patches``     sliding-window patch extraction + per-file scaling.
- ``silence``     RMS silence removal (host-side segment logic).
- ``mixing``      SMR-controlled speech+music mixing.
- ``stats``       per-patch moment statistics (skew/kurtosis vectors).
"""

from . import (featuregram, frontend_pallas, hpss, mel, mixing,  # noqa: F401
               patches, reference, silence, stats, stft)
