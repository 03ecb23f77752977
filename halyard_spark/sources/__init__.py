"""Sources and sinks — the HalyardExport / RIO-parser analogs."""
