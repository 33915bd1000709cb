"""Output assembly: corrected trajectory composition, low-latency pose
serving, viz sinks, checkpoint save/load."""
