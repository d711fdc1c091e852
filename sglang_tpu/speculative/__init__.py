"""Speculative decoding (reference `srt/speculative/`, SURVEY §2 S)."""
