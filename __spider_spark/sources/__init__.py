"""Sources & sinks: page-store generator, testdata loaders, lakehouse layer."""
