from .synthetic import make_texture, warp_homography, SyntheticSequence
