"""Ray-Data-native HTML extraction engine (htmlcore kernel + Ray stages)."""

__version__ = "0.1.0"
