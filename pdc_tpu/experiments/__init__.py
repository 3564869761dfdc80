"""Headless ports of the reference's per-object experiment notebooks
(``dense_correspondence/experiments/``): a declarative protocol registry
plus one shared runner. See :mod:`pdc_tpu.experiments.protocols`."""

from pdc_tpu.experiments.protocols import PROTOCOLS, Protocol, Run, list_protocols
from pdc_tpu.experiments.runner import Scale, run_protocol

__all__ = ["PROTOCOLS", "Protocol", "Run", "list_protocols", "Scale",
           "run_protocol"]
