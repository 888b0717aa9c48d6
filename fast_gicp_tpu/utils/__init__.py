"""I/O, downsampling, padding utilities."""
