DELETE WHERE { ?s <urn:age> ?a }
