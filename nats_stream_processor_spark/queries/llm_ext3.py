"""Round-5 operator extensions (registered into the r5 sampled prefix).

Additions land here so the registry bottom can detect them and rotate
them into the driver's 50-query sample window from day one.
"""

from __future__ import annotations

from ..registry import REGISTRY  # noqa: F401  (registration side effects)
