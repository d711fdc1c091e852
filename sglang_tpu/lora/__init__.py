"""Multi-adapter LoRA serving (reference `srt/lora/`, SURVEY §2 L5)."""
