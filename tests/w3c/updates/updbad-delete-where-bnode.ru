DELETE WHERE { _:b <urn:name> ?n }
