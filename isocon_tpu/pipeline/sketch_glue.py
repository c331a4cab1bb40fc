"""Glue for the approximate (non-targeted) candidate-generation mode."""
from __future__ import annotations

from ..graph.sketch import approximate_nn_graph


def approximate_nn(unique_seqs, conv_mask, engine):
    return approximate_nn_graph(unique_seqs, conv_mask, engine)
