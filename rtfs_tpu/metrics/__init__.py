"""Evaluation metrics: per-utterance SI-SNR(i)/SDR(i) + optional PESQ/STOI.

Counterpart of the reference ``src/metrics/allwrapper.py:19-125``: PIT-based
SI-SNR and SNR ("sdr" in the reference's naming) with improvement-over-
mixture baselines, running mean/std, CSV report with avg+std footer rows.

PESQ/STOI are CPU-side eval extras; they import lazily and degrade to NaN
when pypesq/pystoi are absent (they are offline metrics, not the hot path).
A pure-numpy STOI implementation is provided in ``rtfs_tpu.metrics.stoi_np``
as the default STOI backend so the metric works without C extensions.
"""

from .tracker import ALLMetricsTracker  # noqa: F401
