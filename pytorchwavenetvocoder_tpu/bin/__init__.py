"""CLI entry points (reference wavenet_vocoder/bin/ equivalents)."""
