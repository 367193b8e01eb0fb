from .fastx import SequenceDatabase, seq_len_increment  # noqa: F401
