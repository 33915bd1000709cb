"""Host-side utilities: numpy SE(3), JSON codecs, timing, logging colors."""
