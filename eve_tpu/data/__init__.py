"""Host-side data layer: EVE dataset reading, decode, synthetic fixtures."""
