"""Sources & sinks: change-feed synthesis/readers, lake table with MERGE."""
