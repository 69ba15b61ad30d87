"""Reference-line smoothing stack.

TPU-native re-design of src/reference_path_smoother/: B-spline fit of the raw
points (``tpu_pathopt.bspline``), 1 m resampling through natural splines
(``segment``), the TENSION / TENSION2 smoothing QPs (``tension``/``tension2``),
and the Frenet post-smoothing QP over the DP corridor (``post_smooth``).
"""

from tpu_pathopt.smoothing.segment import segment_raw_reference  # noqa: F401
from tpu_pathopt.smoothing.tension2 import tension2_smooth  # noqa: F401
from tpu_pathopt.smoothing.tension import tension_smooth  # noqa: F401
from tpu_pathopt.smoothing.post_smooth import post_smooth  # noqa: F401
