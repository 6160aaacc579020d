"""Quality-assessment summaries (SURVEY.md §5.5).

The reference relies on datamodels accessors (``qa_image``,
``qa_gain_table`` — logged per solve at chain_calibration.py:205-209);
these are the framework-native equivalents returning plain dicts.
"""

from __future__ import annotations

import numpy as np

__all__ = ["qa_image", "qa_gain_table", "qa_visibility"]


def qa_image(im, context: str = "") -> dict:
    """Image statistics (datamodels qa_image equivalent)."""
    pixels = np.asarray(im.pixels)
    return {
        "context": context,
        "shape": tuple(pixels.shape),
        "max": float(np.max(pixels)),
        "min": float(np.min(pixels)),
        "maxabs": float(np.max(np.abs(pixels))),
        "rms": float(np.std(pixels)),
        "sum": float(np.sum(pixels)),
        "medianabs": float(np.median(np.abs(pixels))),
        "median": float(np.median(pixels)),
    }


def qa_gain_table(gt, context: str = "") -> dict:
    """Gain-table statistics (logged by chain calibration,
    chain_calibration.py:205-209)."""
    gain = np.asarray(gt.gain)
    residual = np.asarray(gt.residual)
    amp = np.abs(gain)
    phase = np.angle(gain)
    return {
        "context": context,
        "shape": tuple(gain.shape),
        "maxabs-amp": float(np.max(amp)),
        "minabs-amp": float(np.min(amp)),
        "rms-amp": float(np.std(amp)),
        "medianabs-amp": float(np.median(amp)),
        "maxabs-phase": float(np.max(np.abs(phase))),
        "rms-phase": float(np.std(phase)),
        "residual": float(np.max(residual)),
    }


def qa_visibility(vis, context: str = "") -> dict:
    """Visibility statistics."""
    data = np.asarray(vis.vis)
    return {
        "context": context,
        "shape": tuple(data.shape),
        "maxabs": float(np.max(np.abs(data))),
        "minabs": float(np.min(np.abs(data))),
        "rms": float(np.std(data)),
        "medianabs": float(np.median(np.abs(data))),
        "sum_weight": float(np.sum(np.asarray(vis.flagged_weight))),
        "fraction_flagged": float(np.mean(np.asarray(vis.flags) > 0)),
    }
