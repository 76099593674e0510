"""Round-6 operator extensions.

Registered into the r6 sampled prefix: the registry bottom fills the
driver's 50-query snapshot window with this module's names (registration
order) after the 15 curated rotation names — the round-5 additions that
never received a formal driver row. Style contract matches
llm_ext/llm_ext2/llm_ext3: every computed column aliased identically on
both engines, rational arithmetic or int-quantized sums wherever a value
crosses an aggregation (cross-engine FP-order independence),
round6_stable for the few unavoidable libm calls, scalar output columns
only (driver-canon safe), DECIMAL(38,0)/HUGEINT for any product of two
corpus-scale int64s.

Reference parity note: the reference (an asyncio NATS enrichment daemon,
/root/reference/src/service.py) has no analytics surface; these operators
extend the engine along the LLM-training-data axis the build brief names
as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Registry import FIRST among intra-package imports (worker re-import
# ordering; see llm_ext2.py's header note).
from ..registry import REGISTRY, pin, register, spread, table

from ..functions.text import TOKEN_RE, tokens_col
from ..operators import similarity as sim

_TOKS = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"
