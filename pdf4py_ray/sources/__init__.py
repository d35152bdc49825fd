"""Input sources: parquet readers + the deterministic transcript synthesizer."""

from .transcripts import read_table, synth_transcripts, synth_turn_rows_for_doc

__all__ = ["read_table", "synth_transcripts", "synth_turn_rows_for_doc"]
