from .distances import latent_distance
from .belief import FingerprintBelief, marginalize_angles
from .clustering import find_clusters, mean_shift, merge_overlapping, optimize_samples
from .identify import (
    FingerprintSet,
    identify_step,
    relative_pose_beliefs,
    calibrate_thresholds,
)
from .io import save_fingerprint, load_fingerprints, save_beliefs, load_beliefs
from .entropy import entropy_slice, entropy_slices
