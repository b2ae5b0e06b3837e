"""Host-side utilities: file IO and visualization."""
