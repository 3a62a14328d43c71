"""Losses: permutation-invariant SDR family (jit-native PIT)."""

from .sdr import (  # noqa: F401
    pairwise_neg_sisdr,
    pairwise_neg_sdsdr,
    pairwise_neg_snr,
    multisrc_neg_sisdr,
    multisrc_neg_snr,
    singlesrc_neg_sisdr,
    singlesrc_neg_snr,
)
from .pit import PITLossWrapper, pit_loss, reorder_sources  # noqa: F401
