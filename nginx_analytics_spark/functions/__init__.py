"""Engine-portable column functions shared across operators and oracles."""
