"""Named query registry — the surface consumed by ``__spark_entry__.py``.

Importing this package registers every query. Each query is a
``(spark, sf_dir) -> DataFrame`` callable paired (where SQL can
express it) with an equivalent DuckDB oracle SQL string; the driver
compares the two at sf=0.01.
"""

from .registry import QUERIES, QuerySpec, register  # noqa: F401

# populate the registry. The registry is consolidated to <=50 queries
# (related shapes merge into one union/melt "suite" registration with
# a variant discriminator) so the external driver's correctness window
# covers EVERY registered query each round — no ordering games needed.
from . import dedup  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import stream  # noqa: F401,E402
from . import text  # noqa: F401,E402
from . import parity  # noqa: F401,E402
from . import olap  # noqa: F401,E402
from . import scale  # noqa: F401,E402
from . import curation  # noqa: F401,E402
from . import cdc  # noqa: F401,E402

__all__ = ["QUERIES", "QuerySpec", "register"]
