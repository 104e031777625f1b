"""Audio transformation effects — first-party replacements for the external
tools the reference shells out to (SURVEY §2.2 native table):

=================  ==========================================================
reference tool     TPU-build equivalent
=================  ==========================================================
``sox speed``      :func:`speed.change_speed` — polyphase resample (C++)
``rubberband``     :func:`pitchshift.time_stretch` / ``pitch_shift`` — JAX
                   phase-vocoder on device + resample
``ffmpeg
alimiter``         :func:`dynamics.true_peak_limit` — parallel-scan lookahead
                   limiter on device
``sox gain`` /
``ffmpeg volume``  :func:`dynamics.apply_gain`
=================  ==========================================================

When the actual binaries exist on PATH the workflow prefers them for
bit-compatibility with the reference's artefacts; these implementations make
the full interactive workflow self-contained otherwise.
"""

from .speed import change_speed, create_speed_changed_file  # noqa: F401
from .pitchshift import time_stretch, pitch_shift, create_pitch_shifted_file  # noqa: F401
from .dynamics import true_peak_limit, apply_gain  # noqa: F401
