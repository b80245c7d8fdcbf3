"""Sources: parquet readers and the deterministic synthetic image table.

The north-rule input is a Lance table of image+caption pairs
(BASELINE.json input_hint). pylance is not installed in this sandbox, so
Parquet stands in for Lance with the identical schema; ``read_image_table``
is the single entry point so a Lance reader can be swapped in behind it
(``ray.data.read_lance`` exists in Ray 2.49 when pylance is available).
"""

from mobray.sources.imagegen import IMAGE_SCHEMA, generate_image_table, read_image_table

__all__ = ["IMAGE_SCHEMA", "generate_image_table", "read_image_table"]
