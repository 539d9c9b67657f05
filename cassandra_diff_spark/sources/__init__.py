"""Sources & sinks: provider registry, catalogs, schema discovery."""
