"""Tiny caption vocabulary for the synthetic corpus."""

import numpy as np

CAPTION_WORDS = np.array([
    "mountain", "river", "city", "forest", "harbor", "desert", "glacier",
    "valley", "island", "bridge", "market", "temple", "canyon", "lagoon",
    "plateau", "meadow",
])
