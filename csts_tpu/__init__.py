"""csts_tpu: TPU-native audio-visual egocentric gaze framework.

See README.md for the layout and COVERAGE.md for the reference-capability map.
"""

__version__ = "0.1.0"
