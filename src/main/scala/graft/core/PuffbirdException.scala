package graft.core

/** Engine error type.
  *
  * Reference: `puffbird/err.py:5-9` (`PuffbirdError(Exception)`).
  */
final class PuffbirdException(msg: String) extends RuntimeException(msg)
