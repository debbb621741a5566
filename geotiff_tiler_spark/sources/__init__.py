"""Sources: page-table synthesis, vector label layers, readers."""
