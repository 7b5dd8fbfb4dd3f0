"""Sources & sinks: testdata table loaders and the snapshot/MERGE sink."""
