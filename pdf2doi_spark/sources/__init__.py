"""Sources and sinks: pages readers, identifier cache, resumable
checkpoint-manifest writer."""
