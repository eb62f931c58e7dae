"""``python -m peterman_search_engine_ray`` — the ``ray job submit``
entry point (north rule): delegates to :mod:`.cli`, which owns the Ray
session.  Example::

    ray job submit --working-dir . -- \
        python -m peterman_search_engine_ray build \
        --input /data/crawl.parquet --index /shared/idx
"""

import sys

from .cli import main

sys.exit(main())
