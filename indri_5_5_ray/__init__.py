"""indri_5_5_ray — a Ray-Data-native inverted-index build + BM25 retrieval engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the Lemur "Indri development release 5.5" reference (rumpelt/indri-5.5), built
on ray.data Datasets, zero-copy Arrow batches and actor-pool stages.  See
SURVEY.md for the reference analysis this design derives from; reference
citations in docstrings use ``ref:`` prefixes meaning files under
/root/reference.
"""

__version__ = "0.1.0"
