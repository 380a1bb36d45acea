"""featurebox_ray — a from-scratch Ray-Data-native feature-engineering engine.

Re-expresses the capabilities of the reference ``Weiren1996/featurebox``
(descriptor computation + feature selection; see SURVEY.md) as a
point-in-time-correct as-of-join + windowed-transform library over Parquet
transcript tables ``(conv_id, turn_idx, role, text, tool, ts)`` built on
``ray.data.Dataset`` + ``map_batches`` over zero-copy Arrow batches.

Layout:
    functions/   stat-kernel library (PropertyStats parity) + window kernels
    stages/      partition/sort shuffle, scalar maps, window, sessionize,
                 as-of join, broadcast lookup join, normalization, dedup,
                 text analysis, ANN
    sources/     parquet IO + deterministic synthetic generators
    pipelines/   end-to-end flagship pipelines
    selection/   feature-selection layer (corr prune, subset search)
    state/       per-partition checkpoints + lineage manifests
"""

__version__ = "0.1.0"
