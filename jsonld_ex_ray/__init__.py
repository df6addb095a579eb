"""jsonld_ex_ray — Ray-Data-native JSON-LD / KG-construction engine.

Importing the package preloads the vectorized-kernel dependencies
(polars / numpy / pyarrow.compute) so every Ray worker pays the import
cost during its FIRST task (usually the long extraction stage) instead of
stalling the first wide-stage task that needs them.
"""

import numpy  # noqa: F401  (preload)
import polars  # noqa: F401  (preload)
import pyarrow.compute  # noqa: F401  (preload)
