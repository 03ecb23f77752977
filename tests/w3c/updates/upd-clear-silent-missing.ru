CLEAR SILENT GRAPH <urn:nosuch>
