"""Declared relational query surface (SURVEY.md §2.4).

Importing this package registers every query into ``registry.REGISTRY``.
The reference delegates this entire surface to a provisioned ClickHouse
server (reference docker-compose.yml:155-174); here it is native Spark.
"""

from . import pricing  # noqa: F401
from . import joins  # noqa: F401
from . import aggregates  # noqa: F401
from . import windows  # noqa: F401
from . import setops  # noqa: F401
from . import scalars  # noqa: F401
from . import subqueries  # noqa: F401
from . import cdc_queries  # noqa: F401
from . import timewindows  # noqa: F401
from . import extensions  # noqa: F401
from . import corpusops  # noqa: F401
from . import misc  # noqa: F401
from . import tpch_gaps  # noqa: F401
from . import embeddings  # noqa: F401
from . import sketches  # noqa: F401
from . import behavior  # noqa: F401
from . import recursive  # noqa: F401
from . import mergetree  # noqa: F401
from . import cdc_history  # noqa: F401
from . import retrieval  # noqa: F401
from . import chfuncs  # noqa: F401
from . import chsql  # noqa: F401
