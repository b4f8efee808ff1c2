"""Column-function library. Everything here returns ``pyspark.sql.Column``
expressions built from JVM built-ins (whole-stage-codegen friendly); no
row-at-a-time Python in this package.
"""

from . import scalars, text, vectors  # noqa: F401
