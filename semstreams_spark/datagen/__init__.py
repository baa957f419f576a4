from .transcripts import ensure_transcripts, transcripts_path, aliases_path, sf_from_dir

__all__ = ["ensure_transcripts", "transcripts_path", "aliases_path", "sf_from_dir"]
