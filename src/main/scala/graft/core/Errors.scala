package graft.core

/** Error taxonomy mirroring the reference's exceptions
  * (rioxarray/exceptions.py:10-60). */
class RioSparkException(msg: String) extends RuntimeException(msg)
final class MissingCrs(msg: String) extends RioSparkException(msg)
final class NoDataInBounds(msg: String) extends RioSparkException(msg)
final class OneDimensionalRaster(msg: String) extends RioSparkException(msg)
final class TooManyDimensions(msg: String) extends RioSparkException(msg)
final class DimensionError(msg: String) extends RioSparkException(msg)
