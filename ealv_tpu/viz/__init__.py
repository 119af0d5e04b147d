from .plotting import (
    set_mpl_format,
    ExplorationPlotter,
    TrainingPlotter,
    EvalPlotter,
    BeliefPlotter,
    plot_clusters,
)
